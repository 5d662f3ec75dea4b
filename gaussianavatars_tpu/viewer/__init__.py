"""Viewer layer: network GUI protocol, orbit camera, local/remote viewers."""
