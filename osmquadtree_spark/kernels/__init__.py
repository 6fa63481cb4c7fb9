from . import quadtree  # noqa: F401
