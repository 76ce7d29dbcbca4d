.PHONY: test fast bench quickstart smoke validate-real

# real-dataset validation: probes ./data for nerf_synthetic/lego and
# nerf_llff_data/fern (scripts/download_data.sh fetches them where
# egress exists) and emits the lego/fern/multiscale PSNR tables through
# the production train/eval CLIs. Skips gracefully when data is absent.
validate-real:
	python scripts/validate_real.py --data_root data

test:
	python -m pytest tests/ -q

# default CI run: skips @pytest.mark.slow e2e fixtures (< 5 min CPU)
fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

quickstart:
	python examples/quickstart.py quickstart_out

# fast CPU smoke: unit + oracle tests only (no e2e training fixtures)
smoke:
	python -m pytest tests/test_encoding.py tests/test_rays.py \
	  tests/test_sampling.py tests/test_volume.py tests/test_model.py -q
