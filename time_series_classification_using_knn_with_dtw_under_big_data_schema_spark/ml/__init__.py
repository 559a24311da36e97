from .estimator import KnnDtwClassifier, KnnDtwClassifierModel  # noqa: F401
