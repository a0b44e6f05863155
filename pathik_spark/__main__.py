"""``python -m pathik_spark`` -> the CLI (reference: ``pathik`` console
script, pathik/cli.py:266)."""

from pathik_spark.cli import main

raise SystemExit(main())
