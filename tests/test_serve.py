"""HTTP render server (serve.py): endpoint smoke tests over a real
socket with tiny models — health metadata for BOTH model families,
a PNG render round-trip, and the occupancy serving mode."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from nerf_simple_tpu.models import NerfMLP
from nerf_simple_tpu.models.nerf import init_nerf_params
from nerf_simple_tpu.render.renderer import RenderSettings
from nerf_simple_tpu.serve import RenderServer, serve


def _start(server):
    httpd = serve(server, port=0)  # OS-assigned free port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"


@pytest.fixture(scope="module")
def tiny_server():
    model = NerfMLP(Lp=2, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    # non-square frame: catches any H/W transposition in the ray grid,
    # the frame reshape, or the PNG round trip
    srv = RenderServer(
        params, 16, 24, 20.0, RenderSettings(N=8), model, warmup=False
    )
    httpd, url = _start(srv)
    yield srv, url
    httpd.shutdown()


def test_health_reports_model(tiny_server):
    _, url = tiny_server
    with urllib.request.urlopen(url + "/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["frame"] == [16, 24]
    assert body["model"] == "NerfMLP"
    assert body["arch"]["Lp"] == 2 and body["arch"]["H"] == 32
    assert body["occupancy"] is False


def test_render_returns_png(tiny_server):
    import cv2

    _, url = tiny_server
    with urllib.request.urlopen(
        url + "/render?r=4&theta=-30&phi=45", timeout=120
    ) as r:
        assert r.headers["Content-Type"] == "image/png"
        data = r.read()
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert img is not None and img.shape == (16, 24, 3)


def test_unknown_path_404(tiny_server):
    _, url = tiny_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url + "/nope", timeout=30)
    assert ei.value.code == 404


def test_health_hashgrid_and_occupancy_render():
    """The /health arch dump must work for the hashgrid family too (it
    has no Lp field), and occupancy serving must produce a frame."""
    from nerf_simple_tpu.models.hashgrid import (
        HashGridModel,
        init_hashgrid_params,
    )

    model = HashGridModel(L=2, F=2, log2_T=6, N_min=4, N_max=8, Ld=2, H=16)
    params = init_hashgrid_params(jax.random.PRNGKey(0), model)
    srv = RenderServer(
        params, 16, 16, 20.0, RenderSettings(N=8), model,
        warmup=False, occupancy=True, occ_R=8,
    )
    assert srv.occ is not None and srv.occ.shape == (8, 8, 8)
    httpd, url = _start(srv)
    try:
        with urllib.request.urlopen(url + "/health", timeout=30) as r:
            body = json.loads(r.read())
        assert body["model"] == "HashGridModel"
        assert body["arch"]["L"] == 2
        assert body["occupancy"] is True
        frame = srv.render(4.0, -30.0, 0.0)
        assert frame.shape == (16, 16, 3) and frame.dtype == np.uint8
    finally:
        httpd.shutdown()


def test_mip_serving_mode():
    """Cone-cast serving (mip + two-level): /health reports it, frames
    render through the interval compositing path."""
    import cv2
    import urllib.request as rq

    model = NerfMLP(Lp=2, Ld=2, H=32)
    params = init_nerf_params(jax.random.PRNGKey(0), model)
    srv = RenderServer(
        params, 12, 16, 14.0,
        RenderSettings(
            N=8, mip=True, mip_levels=2, base_radius=2.0 / 12.0**0.5 / 14.0
        ),
        model, warmup=False,
    )
    httpd, url = _start(srv)
    try:
        with rq.urlopen(url + "/health", timeout=30) as r:
            assert json.loads(r.read())["mip"] is True
        with rq.urlopen(url + "/render?r=4&theta=-30", timeout=120) as r:
            img = cv2.imdecode(
                np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR
            )
        assert img.shape == (12, 16, 3)
    finally:
        httpd.shutdown()


def test_proposal_serving_mode():
    """N_prop > 0 serving: {prop, fine} params, proposal-guided frames."""
    import cv2
    import urllib.request as rq

    from nerf_simple_tpu.models.proposal import (
        ProposalMLP,
        init_proposal_params,
    )

    model = NerfMLP(Lp=2, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = {
        "prop": init_proposal_params(jax.random.PRNGKey(0), pm),
        "fine": init_nerf_params(jax.random.PRNGKey(1), model),
    }
    srv = RenderServer(
        params, 12, 16, 14.0, RenderSettings(N=8, N_prop=4), model,
        warmup=False,
    )
    assert srv.prop_model == pm  # arch recovered from weight shapes
    httpd, url = _start(srv)
    try:
        with rq.urlopen(url + "/health", timeout=30) as r:
            assert json.loads(r.read())["proposal"] is True
        with rq.urlopen(url + "/render?r=4&theta=-30", timeout=120) as r:
            img = cv2.imdecode(
                np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR
            )
        assert img.shape == (12, 16, 3)
    finally:
        httpd.shutdown()
    # a proposal-less checkpoint must be rejected loudly
    with pytest.raises(ValueError, match="proposal-trained"):
        RenderServer(
            init_nerf_params(jax.random.PRNGKey(2), model), 12, 16, 14.0,
            RenderSettings(N=8, N_prop=4), model, warmup=False,
        )


def test_mip_proposal_serving_mode():
    """The mip x proposal composition serves: proposal-guided interval
    edges + IPE frustums per frame (render_rays_proposal's mip branch
    — previously excluded by an over-broad RenderServer assert). Also
    pins the still-rejected pairings: mip_levels=2 + proposal (both
    define the coarse level) and mip + occupancy."""
    from nerf_simple_tpu.models.proposal import (
        ProposalMLP,
        init_proposal_params,
    )

    model = NerfMLP(Lp=2, Ld=2, H=32)
    pm = ProposalMLP(Lp=4, D=2, H=32)
    params = {
        "prop": init_proposal_params(jax.random.PRNGKey(0), pm),
        "fine": init_nerf_params(jax.random.PRNGKey(1), model),
    }
    base = dict(N=8, N_prop=4, mip=True, base_radius=2.0 / 12.0**0.5 / 14.0)
    srv = RenderServer(
        params, 12, 16, 14.0, RenderSettings(**base), model, warmup=False
    )
    frame = srv.render(4.0, -30.0, 0.0)
    assert frame.shape == (12, 16, 3) and frame.dtype == np.uint8
    with pytest.raises(ValueError, match="both define the coarse level"):
        RenderServer(
            params, 12, 16, 14.0,
            RenderSettings(**{**base, "mip_levels": 2}), model,
            warmup=False,
        )
    with pytest.raises(ValueError, match="mip serving excludes"):
        RenderServer(
            params["fine"], 12, 16, 14.0,
            RenderSettings(N=8, mip=True, base_radius=0.01), model,
            warmup=False, occupancy=True,
        )
