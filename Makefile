# Developer entry points (the reference drives everything via make;
# reference Makefile:33-36 runs tests with search mocked — here the
# oracle takes that role and needs nothing external).

.PHONY: test test-fast selfcheck bench scaling package

# zip for spark-submit --py-files on a real cluster
package:
	cd $(CURDIR) && python -c "import shutil; shutil.make_archive('sotohp_spark', 'zip', '.', 'sotohp_spark')"

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
