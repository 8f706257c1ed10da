# Developer entry points (the reference drives everything via make;
# reference Makefile:33-36 runs tests with search mocked — here the
# oracle takes that role and needs nothing external).

.PHONY: test test-fast selfcheck bench scaling package submit-smoke

# zip for spark-submit --py-files on a real cluster
package:
	cd $(CURDIR) && python -c "import shutil; shutil.make_archive('sotohp_spark', 'zip', '.', 'sotohp_spark')"

# the north rule's deployment shape, end-to-end: build then query an
# index through spark-submit --py-files, with the index on a file://
# URI so the Hadoop-FS control plane is exercised too
submit-smoke: package
	rm -rf /tmp/submit_idx
	/opt/spark/bin/spark-submit --master 'local[8]' \
	  --py-files sotohp_spark.zip scripts/build_index.py \
	  --sf 0.05 --index file:///tmp/submit_idx --fingerprint smoke
	/opt/spark/bin/spark-submit --master 'local[8]' \
	  --py-files sotohp_spark.zip scripts/query_index.py \
	  --index file:///tmp/submit_idx --query "error retry timeout" --k 5

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/test_tokenizer.py tests/test_varbyte.py \
	  tests/test_wand.py -q -k "not spark"

selfcheck:
	python scripts/selfcheck.py

bench:
	python bench.py

scaling:
	python scripts/scaling.py --n 2 --sf 100
