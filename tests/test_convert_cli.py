"""convert.py stage sequencing against a stub `colmap` executable.

The real colmap/imagemagick binaries are absent here (as in most CI), so a
recording stub stands in: the test asserts the reference's stage sequence
(feature_extractor -> exhaustive_matcher -> mapper -> image_undistorter,
reference convert.py:31-124), the sparse/0 relayout, and the
--skip_matching / --no_gpu flag behavior.
"""

import os
import stat
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import convert  # noqa: E402


def _make_stub_colmap(tmp_path):
    """A fake colmap that logs its argv and fabricates undistorter output."""
    log = tmp_path / "calls.log"
    script = tmp_path / "colmap"
    script.write_text(f"""#!/bin/sh
echo "$@" >> {log}
# the undistorter creates sparse/ content the converter must relayout
case "$1" in
  image_undistorter)
    out=""
    grab=0
    for a in "$@"; do
      if [ "$grab" = 1 ]; then out="$a"; grab=0; fi
      [ "$a" = "--output_path" ] && grab=1
    done
    mkdir -p "$out/sparse"
    touch "$out/sparse/cameras.bin" "$out/sparse/images.bin"
    ;;
esac
exit 0
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script), log


def test_convert_stage_sequence(tmp_path):
    src = tmp_path / "capture"
    (src / "input").mkdir(parents=True)
    colmap, log = _make_stub_colmap(tmp_path)

    convert.main(["-s", str(src), "--colmap_executable", colmap,
                  "--no_gpu"])

    calls = [ln.split()[0] for ln in log.read_text().splitlines()]
    assert calls == ["feature_extractor", "exhaustive_matcher", "mapper",
                     "image_undistorter"]
    text = log.read_text()
    assert "--SiftExtraction.use_gpu 0" in text       # --no_gpu honored
    assert "--ImageReader.camera_model OPENCV" in text
    # undistorter output relayouted into sparse/0 (reader expectation)
    assert (src / "sparse" / "0" / "cameras.bin").exists()
    assert (src / "sparse" / "0" / "images.bin").exists()
    assert not (src / "sparse" / "cameras.bin").exists()


def test_convert_skip_matching(tmp_path):
    src = tmp_path / "capture"
    (src / "input").mkdir(parents=True)
    # skip_matching expects a prior distorted/sparse/0 reconstruction
    (src / "distorted" / "sparse" / "0").mkdir(parents=True)
    colmap, log = _make_stub_colmap(tmp_path)

    convert.main(["-s", str(src), "--colmap_executable", colmap,
                  "--skip_matching"])

    calls = [ln.split()[0] for ln in log.read_text().splitlines()]
    assert calls == ["image_undistorter"]
    assert (src / "sparse" / "0" / "cameras.bin").exists()
