.PHONY: test bench quickstart smoke

test:
	python -m pytest tests/ -q

bench:
	python bench.py

quickstart:
	python examples/quickstart.py quickstart_out

# fast CPU smoke: unit + oracle tests only (no e2e training fixtures)
smoke:
	python -m pytest tests/test_encoding.py tests/test_rays.py \
	  tests/test_sampling.py tests/test_volume.py tests/test_model.py -q
