#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline (north-rule launch mode).

The package itself uses relative imports, so spark-submit needs a flat
launcher: ship the package with ``--py-files dist/<pkg>.zip`` (built by
scripts/submit.sh) and point spark-submit at this file. The zip lands on
the driver's and every executor's sys.path, so the import below resolves
on all nodes — the same mechanics as a real multi-executor cluster.

Usage (see scripts/submit.sh):
    spark-submit --master local[8] \
        --py-files dist/hyrise_generalized_dedup_spark.zip \
        scripts/submit_pipeline.py --input synth:5000 --output /tmp/gd_out
"""

from hyrise_generalized_dedup_spark.dedup.pipeline import main

if __name__ == "__main__":
    main()
