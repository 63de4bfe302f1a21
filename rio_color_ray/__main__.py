"""``python -m rio_color_ray`` — the engine CLI entry point."""

from .cli import engine

engine(prog_name="engine")
