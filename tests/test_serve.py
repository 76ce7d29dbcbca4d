"""Render-server tests: real HTTP round trips against a tiny model."""

import json
import socket
import threading
import urllib.request

import jax
import numpy as np
import pytest

from nerf_simple_tpu.models.nerf import NerfMLP, init_nerf_params
from nerf_simple_tpu.render.renderer import RenderSettings
from nerf_simple_tpu.serve import RenderServer, serve


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def running_server():
    model = NerfMLP(Lp=4, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    srv = RenderServer(
        params, H=24, W=32, f=30.0,
        settings=RenderSettings(N=8, compute_dtype=jax.numpy.float32),
    )
    port = _free_port()
    httpd = serve(srv, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()


def test_health_reports_arch(running_server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{running_server}/health", timeout=30
    ) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["frame"] == [24, 32]
    assert body["arch"] == [4, 2, 32]  # inferred, not flagship


def test_render_returns_decodable_png(running_server):
    import cv2

    url = (
        f"http://127.0.0.1:{running_server}/render?r=4&theta=-30&phi=45"
    )
    with urllib.request.urlopen(url, timeout=120) as r:
        assert r.headers["Content-Type"] == "image/png"
        data = r.read()
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (24, 32, 3)


def test_unknown_path_404(running_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            f"http://127.0.0.1:{running_server}/nope", timeout=30
        )
    assert ei.value.code == 404


def test_render_server_direct_api():
    model = NerfMLP(Lp=4, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(1), model)
    srv = RenderServer(
        params, H=16, W=16, f=20.0,
        settings=RenderSettings(N=8, compute_dtype=jax.numpy.float32),
        warmup=False,
    )
    frame = srv.render(4.0, -30.0, 120.0)
    assert frame.shape == (16, 16, 3) and frame.dtype == np.uint8
