"""Rendering engine: fused ray rendering, tiled image render, orbit video."""

from nerf_simple_tpu.render.renderer import (
    RenderSettings,
    render_rays,
    render_rays_hierarchical,
    render_rays_chunked,
    render_image,
    render_orbit_video,
)

__all__ = [
    "RenderSettings",
    "render_rays",
    "render_rays_hierarchical",
    "render_rays_chunked",
    "render_image",
    "render_orbit_video",
]
