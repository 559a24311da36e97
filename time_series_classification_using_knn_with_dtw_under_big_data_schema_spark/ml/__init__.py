from .estimator import KnnDtwClassifier, KnnDtwClassifierModel  # noqa: F401
from .vector import assemble_vector, from_vector, to_vector  # noqa: F401
