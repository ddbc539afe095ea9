.PHONY: test oracle bench zip submit

test:
	python -m pytest tests/ -x -q

oracle:
	python scripts/check_oracles.py /root/testdata/sf0.01

bench:
	python bench.py

zip:
	python -m zipfile -c sparkh3.zip sparkh3

submit: zip
	spark-submit --master 'local[8]' --py-files sparkh3.zip jobs/pipeline_job.py
