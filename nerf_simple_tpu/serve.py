"""Novel-view render server: a minimal production serving surface.

The reference has no serving story (its only "deployment" is the
test.py batch renderer); serving novel views interactively is the
natural production use of a trained NeRF, so the framework ships one:

    python -m nerf_simple_tpu.serve --loadpath models/exp/params_10000.npz \
        --height 400 --width 400 --focal 555.0 [--port 8000]

Endpoints:
  GET /health                  -> {"status": "ok", ...}
  GET /render?r=4&theta=-30&phi=120[&w=..&h=..]  -> image/png

Design notes (TPU serving):
- params are loaded once and live on device; each request is one jitted
  chunked render (the same fixed-shape chunk program as eval, so after
  the warmup render every requested frame reuses the compiled kernel);
- frame shapes are pinned at server start — dynamic per-request sizes
  would recompile, so ``w``/``h`` overrides are rounded to the pinned
  shape unless they match exactly;
- the HTTP layer is a threading server but renders are serialized
  through a lock: one TPU, one compiled program, no benefit from
  concurrent device entry.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np


class RenderServer:
    """Holds device params + a warm render program; thread-safe render()."""

    def __init__(
        self,
        params,
        H: int,
        W: int,
        f: float,
        settings=None,
        model=None,
        warmup: bool = True,
        occupancy: bool = False,
        occ_R: int = 64,
    ):
        from nerf_simple_tpu.models import infer_model
        from nerf_simple_tpu.render.renderer import RenderSettings

        self.params = jax.tree.map(jax.numpy.asarray, params)
        self.model = model or infer_model(params)
        self.settings = settings or RenderSettings()
        if self.settings.mip and (self.settings.N_coarse > 0 or occupancy):
            # mirror Train/TestConfig validation: cone casting draws its
            # own interval edges (occupancy ts would trip the renderer's
            # assert; hierarchical would silently win the dispatch and
            # drop cone casting while /health reports mip). Proposal DOES
            # compose (render_rays_proposal's mip branch: the proposal
            # histogram places the interval edges — the mip-NeRF 360
            # model serves as trained).
            raise ValueError(
                "mip serving excludes hierarchical/occupancy sampling: "
                "cone casting draws its own interval edges (mip_levels=2 "
                "is the cone-cast hierarchical scheme); proposal-guided "
                "mip serving IS supported (--proposal-samples)"
            )
        if (
            self.settings.mip
            and self.settings.mip_levels == 2
            and self.settings.N_prop > 0
        ):
            # same rejection as TrainConfig: both define the coarse level
            raise ValueError(
                "mip_levels=2 and proposal sampling both define the "
                "coarse level; serve mip x proposal with mip_levels=1"
            )
        self.prop_model = None
        if self.settings.N_prop > 0:
            # proposal-guided serving: the tiny density MLP places the
            # N-sample budget per frame (needs a proposal-trained ckpt)
            if not (isinstance(params, dict) and "prop" in params):
                raise ValueError(
                    "settings.N_prop > 0 needs a proposal-trained "
                    "checkpoint ({'prop', 'fine'} params)"
                )
            import dataclasses

            from nerf_simple_tpu.models.proposal import infer_proposal_arch

            # contract is shape-invariant: copy from the main model
            self.prop_model = dataclasses.replace(
                infer_proposal_arch(params["prop"]),
                contract=getattr(self.model, "contract", False),
            )
        self.H, self.W, self.f = H, W, float(f)
        self.occ = None
        if occupancy:
            # derived state: one-time grid rebuild from the density field
            # lets every served frame spend its sample budget in occupied
            # space (deterministic quantiles — frames stay reproducible)
            from nerf_simple_tpu.ops.occupancy import rebuild_occ

            self.occ = rebuild_occ(
                self.params,
                self.model,
                self.settings.compute_dtype,
                occ_R,
                self.settings.occ_aabb,
                jax.random.PRNGKey(42),
            )
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(0)
        if warmup:
            self.render(4.0, -30.0, 0.0)  # compile the chunk program

    def render(self, r: float, theta: float, phi: float) -> np.ndarray:
        """Render one (H, W, 3) uint8 frame from spherical camera coords
        (the reference's dome parametrization, utils/xyz.py:70-81)."""
        import jax.numpy as jnp

        from nerf_simple_tpu.ops.rays import rays_for_poses, spherical_to_pose
        from nerf_simple_tpu.render.renderer import render_rays_chunked

        pose = spherical_to_pose(r, theta, phi)[None]
        rays = rays_for_poses(
            jnp.asarray(pose, jnp.float32), self.H, self.W, self.f
        )
        with self._lock:
            rgb, _ = render_rays_chunked(
                self.params, rays, self._key, self.settings, self.model,
                occ=self.occ, prop_model=self.prop_model,
            )
            frame = np.asarray(rgb).reshape(self.H, self.W, 3)
        return (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)


def _make_handler(server: RenderServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            u = urlparse(self.path)
            if u.path == "/health":
                import dataclasses

                self._json(
                    200,
                    {
                        "status": "ok",
                        "frame": [server.H, server.W],
                        # model-family-agnostic (NerfMLP has Lp/Ld/H,
                        # HashGridModel has L/F/...): report the dataclass
                        "model": type(server.model).__name__,
                        "arch": dataclasses.asdict(server.model),
                        "backend": server.settings.backend,
                        "occupancy": server.occ is not None,
                        "proposal": server.prop_model is not None,
                        "mip": server.settings.mip,
                    },
                )
                return
            if u.path != "/render":
                self._json(404, {"error": f"unknown path {u.path}"})
                return
            q = parse_qs(u.query)

            def num(name, default):
                return float(q[name][0]) if name in q else default

            try:
                frame = server.render(
                    num("r", 4.0), num("theta", -30.0), num("phi", 0.0)
                )
            except Exception as e:  # surface render errors as 500 JSON
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            import cv2

            ok, png = cv2.imencode(
                ".png", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            )
            if not ok:
                self._json(500, {"error": "png encode failed"})
                return
            data = png.tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return Handler


def serve(server: RenderServer, port: int = 8000) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call .serve_forever())."""
    httpd = ThreadingHTTPServer(("0.0.0.0", port), _make_handler(server))
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser(description="NeRF novel-view render server")
    ap.add_argument("--loadpath", required=True,
                    help="params npz/pth or Orbax ckpt dir")
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument("--focal", type=float, required=True)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--occupancy", action="store_true",
                    help="rebuild an occupancy grid from the checkpoint "
                    "and concentrate --samples in occupied space")
    ap.add_argument("--occ-R", type=int, default=64)
    ap.add_argument("--proposal-samples", type=int, default=0,
                    help="> 0: proposal-guided sampling with this many "
                    "probes (needs a proposal-trained checkpoint)")
    ap.add_argument("--mip", action="store_true",
                    help="cone-cast (IPE) rendering — anti-aliased at "
                    "any frame scale; cone radius derives from --focal")
    ap.add_argument("--mip-levels", type=int, default=1, choices=[1, 2],
                    help="2 = coarse+fine cone casting (shared MLP)")
    ap.add_argument("--resample-blur", type=float, default=0.01,
                    help="interval-edge resampling floor (match the "
                    "checkpoint's TrainConfig.resample_blur)")
    ap.add_argument("--opaque-background", action="store_true",
                    help="mip-NeRF 360 opaque background: the last cone "
                    "frustum absorbs all leftover transmittance (match "
                    "the checkpoint's TrainConfig.opaque_background)")
    ap.add_argument("--tn", type=float, default=2.0,
                    help="near sampling bound (match the training config "
                    "— unbounded/360 checkpoints used e.g. 0.2)")
    ap.add_argument("--tf", type=float, default=6.0,
                    help="far sampling bound (e.g. 100 for contracted "
                    "360 checkpoints)")
    ap.add_argument("--sampling-space", default="linear",
                    choices=["linear", "disparity"],
                    help="'disparity' = bins uniform in 1/t (use what "
                    "the checkpoint trained with)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from nerf_simple_tpu.evaluate import load_params
    from nerf_simple_tpu.render.renderer import RenderSettings
    from nerf_simple_tpu.train.checkpoint import load_model_meta

    params = load_params(
        args.loadpath, keep_hierarchy=args.proposal_samples > 0
    )
    # the model.json sidecar carries statics (hash-grid N_min/N_max/aabb)
    # that weight shapes can't recover — same resolution order as eval
    model = load_model_meta(args.loadpath)
    settings = RenderSettings(
        N=args.samples,
        N_prop=args.proposal_samples,
        mip=args.mip,
        mip_levels=args.mip_levels,
        resample_blur=args.resample_blur,
        opaque_background=args.opaque_background,
        # pixel world-space half-width at unit distance (mip-NeRF 3.1)
        base_radius=(2.0 / 12.0**0.5 / args.focal) if args.mip else 0.0,
        tn=args.tn,
        tf=args.tf,
        sampling_space=args.sampling_space,
        backend=args.backend,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    srv = RenderServer(
        params, args.height, args.width, args.focal, settings,
        model=model,  # None -> RenderServer infers from weight shapes
        occupancy=args.occupancy, occ_R=args.occ_R,
    )
    httpd = serve(srv, args.port)
    print(f"serving on :{args.port} (frame {args.height}x{args.width}, "
          f"{args.backend}/{args.dtype}, N={args.samples})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
