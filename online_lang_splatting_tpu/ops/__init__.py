from . import lie, graphics, sh, losses  # noqa: F401
