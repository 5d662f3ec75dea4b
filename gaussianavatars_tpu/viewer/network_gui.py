"""Training-process GUI server, wire-compatible with the reference client.

Protocol (reference gaussian_renderer/network_gui.py:26-88 +
remote_viewer.py:48-156): a non-blocking TCP listener polled from the train
loop; messages are 4-byte little-endian length-prefixed JSON; replies are
raw uint8 RGB bytes (H*W*3, row-major) followed by a length-prefixed JSON
stats dict. The client's view/projection matrices arrive in OpenGL-ish
convention: columns 1,2 of the view matrix and column 1 of the projection
are negated server-side, exactly like the reference.
"""

from __future__ import annotations

import json
import socket
from typing import Optional

import numpy as np

from gaussianavatars_tpu.data.cameras import MiniCam


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host = host
        self.port = port
        self.listener: Optional[socket.socket] = None
        self.conn: Optional[socket.socket] = None

    def init(self):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((self.host, self.port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self):
        if self.listener is None:
            return
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, socket.timeout):
            pass

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client disconnected")
            buf += chunk
        return buf

    def read(self) -> dict:
        length = int.from_bytes(self._read_exact(4), "little")
        return json.loads(self._read_exact(length).decode("utf-8"))

    def receive(self):
        """-> (MiniCam | None, msg dict). Mirrors network_gui.py:64-88."""
        msg = self.read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        msg["do_training"] = bool(msg["do_training"])
        msg["keep_alive"] = bool(msg["keep_alive"])
        if width == 0 or height == 0:
            return None, msg

        wv = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] = -wv[:, 1]
        wv[:, 2] = -wv[:, 2]
        proj = np.asarray(
            msg["view_projection_matrix"], np.float32
        ).reshape(4, 4)
        proj[:, 1] = -proj[:, 1]
        cam = MiniCam(
            width=width, height=height,
            fovy=msg["fov_y"], fovx=msg["fov_x"],
            znear=msg["z_near"], zfar=msg["z_far"],
            world_view_transform=wv, full_proj_transform=proj,
            timestep=msg.get("timestep", 0),
        )
        return cam, msg

    def send(self, image: Optional[np.ndarray], stats: dict):
        """image: [3, H, W] float in [0,1] or None; stats JSON-encodable."""
        if image is not None:
            img8 = np.clip(np.asarray(image) * 255.0, 0, 255).astype(np.uint8)
            self.conn.sendall(img8.transpose(1, 2, 0).tobytes())
        payload = json.dumps(stats).encode("utf-8")
        self.conn.sendall(len(payload).to_bytes(4, "little"))
        self.conn.sendall(payload)

    def drop(self):
        try:
            if self.conn is not None:
                self.conn.close()
        except OSError:
            pass
        self.conn = None

    def close(self):
        self.drop()
        if self.listener is not None:
            self.listener.close()
            self.listener = None
