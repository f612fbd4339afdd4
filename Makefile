# Live targets only (the reference Makefile carried dead boilerplate —
# SURVEY.md 2.5; everything here runs).

.PHONY: test quality style native bench clean

test:
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
