from .evaluator import Evaluator, evaluate_arrays  # noqa: F401
