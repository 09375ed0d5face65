from . import losses, centroids, metrics  # noqa: F401
