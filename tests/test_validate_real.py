"""Fixture test for the real-dataset validation harness.

scripts/validate_real.py is the armed one-command path to the
lego/fern PSNR tables the moment a canonical dataset is mounted
(egress is dead in this environment — docs/PERFORMANCE.md). This test
proves the harness end-to-end against a synthetic scene laid out
exactly like nerf_synthetic/lego, so a future real-data run cannot be
blocked by harness rot.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts")
)


@pytest.mark.slow
def test_validate_real_tiny_on_synthetic_lego_layout(tmp_path):
    from nerf_simple_tpu.data.synthetic import write_blender_scene

    import validate_real

    scene = tmp_path / "data" / "nerf_synthetic" / "lego"
    write_blender_scene(str(scene), n_train=3, n_val=1, n_test=1, H=24, W=24)

    results = validate_real.main(
        [
            "--data_root", str(tmp_path / "data"),
            "--workdir", str(tmp_path / "work"),
            "--tiny",
            "--only", "flagship",
            "--out", str(tmp_path / "real_validation.json"),
        ]
    )
    assert len(results) == 1
    row = results[0]
    assert row["views"] and all("psnr" in v for v in row["views"])
    assert row["mean_psnr"] > 5.0  # 20 tiny iters: sanity, not quality
    assert (tmp_path / "real_validation.json").exists()


def test_validate_real_skips_cleanly_without_data(tmp_path, capsys):
    import validate_real

    results = validate_real.main(
        ["--data_root", str(tmp_path), "--workdir", str(tmp_path / "w")]
    )
    assert results == []
    out = capsys.readouterr().out
    assert "No datasets found" in out
