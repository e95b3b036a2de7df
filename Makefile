.PHONY: test parity-gate bench

test:
	python -m pytest tests/ -x -q

# The driver's correctness gate compares Spark vs DuckDB at sf0.01.
# Run this before every round snapshot — sf0.001-only green can hide
# sf-dependent divergence (group cardinality, quantile ties).
parity-gate:
	PYSTREAMS_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

bench:
	python bench.py
