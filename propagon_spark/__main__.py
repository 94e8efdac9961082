"""``python -m propagon_spark`` — the reference-shaped CLI entry point."""

from propagon_spark.cli import main

if __name__ == "__main__":
    main()
