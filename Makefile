# Developer gates.  `make check` is the MANDATORY pre-snapshot gate: any
# commit touching functions/, pipeline/, operators/, sinks/ or plans/ must
# run it first (round 5 shipped a 122-test ANSI regression in a snapshot
# commit that this exact target would have caught in under two minutes).

.PHONY: check test bench driver-sim

# Fast regression gate (~2.5 min): formatter semantics + ANSI edge probes +
# golden sha256-pinned end-to-end artifacts + the driver-window contract
# (window stays 50 oracle-backed entries; a broken registration would
# silently shrink the external hard signal).
check:
	python -m pytest tests/test_ansi_edges.py tests/test_formatters.py \
	    tests/test_golden_outputs.py \
	    tests/test_oracle_parity.py::test_driver_window_is_all_oracle_backed -q

# Full suite (~12 min).
test:
	python -m pytest tests/ -q

# Driver-contract simulation from a neutral cwd (catches executor-side
# import failures that repo-cwd runs mask).
driver-sim:
	cd /tmp && python3 $(CURDIR)/tests/driver_sim.py

bench:
	python bench.py
