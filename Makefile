SF_SMALL ?= /root/testdata/sf0.01
SF_BENCH ?= /root/testdata/sf0.1

.PHONY: test oracle oracle-stress bench plans all

test:
	python -m pytest tests/ -q

oracle:
	python tools/oracle_check.py $(SF_SMALL)

oracle-stress:
	python tools/oracle_check.py $(SF_BENCH)

bench:
	python bench.py

plans:
	python tools/plan_audit.py $(SF_SMALL) --write

all: test oracle bench
