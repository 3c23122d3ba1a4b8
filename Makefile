# Developer conveniences
.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

bench-all:
	python scripts/bench_all.py --out docs/BENCHMARKS.md

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
