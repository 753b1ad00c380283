"""``python -m spiders_for_all_spark`` — see cli.py (reference
__main__.py:1-18 wires the click groups the same way)."""

from spiders_for_all_spark.cli import main

raise SystemExit(main())
