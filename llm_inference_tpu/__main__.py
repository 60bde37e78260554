"""``python -m llm_inference_tpu`` — the CLI entry point."""

from .cli import main

raise SystemExit(main())
