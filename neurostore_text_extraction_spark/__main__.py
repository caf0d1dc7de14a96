"""``python -m neurostore_text_extraction_spark`` entry point."""

from .cli import main

raise SystemExit(main())
