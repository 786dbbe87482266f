.PHONY: test check bench smoke lint examples

test:
	python -m pytest tests/ -q

check:
	python tools/check_oracles.py

check-smoke:
	python tools/check_oracles.py /root/testdata/sf0.001

bench:
	python bench.py

smoke:
	python -c "import __spark_entry__ as e; from wimbd_spark import get_spark; \
s = get_spark(master='local[4]', shuffle_partitions=4); \
df = e.entry(s); print(df.count(), 'rows'); s.stop()"

examples:
	for f in examples/*.py; do echo "== $$f"; python $$f || exit 1; done
