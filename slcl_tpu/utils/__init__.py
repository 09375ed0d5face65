from .timer import timeit, TimeChecker  # noqa: F401
