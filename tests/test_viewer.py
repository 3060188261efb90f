"""Viewer HTTP server: page, orbit/fly render, pause protocol, stats."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from gslidar_tpu.engine.viewer import VisManager, _fly_c2w, _orbit_c2w


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read(), r.headers.get("Content-Type")


def _post(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


@pytest.fixture
def mgr():
    calls = []

    def render_fn(c2w, frame):
        calls.append((np.asarray(c2w), frame))
        return np.full((3, 8, 16), 0.5, np.float32)

    m = VisManager({"port": 18472, "enabled": True, "max_frame": 4,
                    "pixels_per_step": 128}, render_fn)
    assert m.server is not None, "viewer server failed to start"
    m.calls = calls
    yield m
    m.server.shutdown()


def test_viewer_endpoints(mgr):
    body, ctype = _get(mgr.port, "/")
    assert b"gslidar_tpu viewer" in body and "html" in ctype

    png, ctype = _get(mgr.port, "/render?mode=orbit&az=30&el=10&dist=20"
                                "&frame=2")
    assert png[:4] == b"\x89PNG" and ctype == "image/png"
    c2w, frame = mgr.calls[-1]
    assert frame == 2
    np.testing.assert_allclose(c2w, _orbit_c2w(30, 10, 20), atol=1e-6)

    png, _ = _get(mgr.port, "/render?mode=fly&px=1&py=-2&pz=3"
                            "&yaw=45&pitch=-10&frame=0")
    assert png[:4] == b"\x89PNG"
    c2w, _f = mgr.calls[-1]
    np.testing.assert_allclose(c2w, _fly_c2w(np.array([1.0, -2.0, 3.0]),
                                             45, -10), atol=1e-6)
    # camera position lands where the query said
    np.testing.assert_allclose(c2w[:3, 3], [1, -2, 3], atol=1e-6)

    # pause blocks checkin until resumed (nerfview paused state)
    st = _post(mgr.port, "/pause")
    assert st["paused"] is True
    entered = threading.Event()

    def worker():
        mgr.checkin()
        entered.set()
        mgr.checkout()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    time.sleep(0.2)
    assert not entered.is_set(), "checkin must block while paused"
    st = _post(mgr.port, "/pause")
    assert st["paused"] is False
    assert entered.wait(5.0)
    t.join(5.0)

    stats = json.loads(_get(mgr.port, "/stats")[0])
    assert stats["rays_per_sec"] > 0


def test_fly_c2w_orthonormal():
    c2w = _fly_c2w(np.array([3.0, -1.0, 7.0]), 123, 31)
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0.99


def test_moving_resolution_preview():
    """/render?preview=1 reaches a 3-parameter callback as preview=True
    (nerfview's while-moving degradation); 2-parameter callbacks keep
    working full-res."""
    calls = []

    def render_fn(c2w, frame, preview):
        calls.append(preview)
        h = 4 if preview else 8
        return np.full((3, h, 2 * h), 0.5, np.float32)

    m = VisManager({"port": 18473, "enabled": True, "max_frame": 2,
                    "pixels_per_step": 128}, render_fn)
    assert m.server is not None
    try:
        png, _ = _get(m.port, "/render?mode=orbit&az=0&el=0&dist=10"
                              "&frame=0&preview=1")
        assert png[:4] == b"\x89PNG" and calls[-1] is True
        png, _ = _get(m.port, "/render?mode=orbit&az=0&el=0&dist=10"
                              "&frame=0")
        assert calls[-1] is False
    finally:
        m.server.shutdown()

    # the page JS requests preview while dragging or holding a move key
    from gslidar_tpu.engine.viewer import _PAGE
    assert "preview=1" in _PAGE
