.PHONY: test parity-gate parity-sweep parity-aqe-off bench

test:
	python -m pytest tests/ -x -q

# The driver's correctness gate compares Spark vs DuckDB at sf0.01.
# Run this before every round snapshot — sf0.001-only green can hide
# sf-dependent divergence (group cardinality, quantile ties).
parity-gate:
	PYSTREAMS_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

# Partitioning-independence sweep: the whole parity suite under a
# different shuffle-partition count — any query whose result depends on
# partitioning fails the oracle compare. r4: green at 5 and 8; r5 final: green at 5, 8, and 97 (191 tests, 189 oracle-backed queries).
parity-sweep:
	PYSTREAMS_TEST_SHUFFLE=5 PYSTREAMS_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

# AQE-independence sweep (r12-ext): the whole parity suite with
# adaptive execution DISABLED — any query whose result depends on AQE
# replanning (runtime coalesce/skew-split) fails the oracle compare.
parity-aqe-off:
	SPARK_GRAFT_EXTRA_CONFS="spark.sql.adaptive.enabled=false" PYSTREAMS_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_parity.py -q

bench:
	python bench.py
