from .geometry import DesignGeometry, generate_geometry  # noqa: F401
from . import convex  # noqa: F401

# .plotting is intentionally not imported here: it pulls in matplotlib, which is
# only needed by the visualization CLI.
