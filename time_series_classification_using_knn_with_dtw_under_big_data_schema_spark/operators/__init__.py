from .knn import knn_join, knn_classify, knn_predict_1nn  # noqa: F401
from .topk import topk_per_key  # noqa: F401
from .vote import majority_vote  # noqa: F401
from .evaluate import accuracy  # noqa: F401
