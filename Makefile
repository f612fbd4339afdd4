# Live targets only (the reference Makefile carried dead boilerplate —
# SURVEY.md 2.5; everything here runs).

.PHONY: test test-all quality style native bench clean

# Fast default (<10 min on this host): skips `slow`-marked compile/ETL-heavy
# tests. CI-equivalent full run: `make test-all` (~30-55 min on 1 core).
test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	python bench.py

quality:
	python -m ruff check climate_tpu tests tools || true

style:
	python -m ruff format climate_tpu tests tools || true

clean:
	rm -rf tests/.jax_cache climate_tpu/data/_native
	find . -name __pycache__ -type d -exec rm -rf {} +
