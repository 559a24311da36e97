"""pyspark.ml Estimator/Transformer wrapper around the KNN core
(SURVEY.md §2.9 M2).

The reference is a lazy learner — "the model itself is the entire dataset"
(Team11-Project.py markdown, :123-124) — so fit() just captures the train
DataFrame; transform() runs the declarative crossJoin -> distance -> top-k ->
vote plan. This matches the Report's own future-work: "Structuring the
implementation into more coherent pipelines and transformers" (Report p.6).

Params mirror the reference's knobs: k (hyperparameter sweep,
Team11-Project.py:233-322), metric (euclidean | fastdtw | dtw | ...),
strategy (Model 1 shuffle cartesian vs Model 2 broadcast).
"""

from __future__ import annotations

from pyspark.ml import Estimator, Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.sql import DataFrame

from ..operators.knn import knn_classify, knn_join, knn_predict_1nn


class _KnnParams(Params):
    k = Param(Params._dummy(), "k", "number of neighbors", TypeConverters.toInt)
    metric = Param(Params._dummy(), "metric", "distance metric name", TypeConverters.toString)
    strategy = Param(Params._dummy(), "strategy", "broadcast | shuffle | kernel | chunked", TypeConverters.toString)
    idCol = Param(Params._dummy(), "idCol", "row id column", TypeConverters.toString)
    featuresCol = Param(Params._dummy(), "featuresCol", "series column", TypeConverters.toString)
    labelCol = Param(Params._dummy(), "labelCol", "label column", TypeConverters.toString)
    predictionCol = Param(Params._dummy(), "predictionCol", "output column", TypeConverters.toString)
    band = Param(Params._dummy(), "band",
                 "Sakoe-Chiba band half-width for metric='dtw' (-1 = unconstrained)",
                 TypeConverters.toInt)
    fastdtwRadius = Param(Params._dummy(), "fastdtwRadius",
                          "FastDTW refinement radius for metric='fastdtw'",
                          TypeConverters.toInt)

    def __init__(self):
        super().__init__()
        self._setDefault(
            k=5,
            metric="euclidean",
            strategy="broadcast",
            idCol="series_id",
            featuresCol="features",
            labelCol="label",
            predictionCol="predicted_label",
            band=-1,
            fastdtwRadius=1,
        )

    def _metric_kwargs(self):
        band = self.getOrDefault(self.band)
        return dict(
            band=None if band < 0 else band,
            fastdtw_radius=self.getOrDefault(self.fastdtwRadius),
        )


class KnnDtwClassifier(Estimator, _KnnParams):
    """Brute-force KNN classifier with pluggable series distance."""

    def __init__(self, **kwargs):
        super().__init__()
        self._set(**{k: v for k, v in kwargs.items() if v is not None})

    def setParams(self, **kwargs):
        self._set(**kwargs)
        return self

    def _fit(self, dataset: DataFrame) -> "KnnDtwClassifierModel":
        model = KnnDtwClassifierModel(train=dataset)
        model._resetUid(self.uid)
        # copy the explicitly-set AND default param values onto the model
        for p in self.params:
            model._set(**{p.name: self.getOrDefault(p)})
        return model


class KnnDtwClassifierModel(Transformer, _KnnParams):
    """Fitted model = the train set + params (lazy learner)."""

    def __init__(self, train: DataFrame | None = None):
        super().__init__()
        self.train = train

    def _transform(self, dataset: DataFrame) -> DataFrame:
        common = dict(
            metric=self.getOrDefault(self.metric),
            strategy=self.getOrDefault(self.strategy),
            id_col=self.getOrDefault(self.idCol),
            features_col=self.getOrDefault(self.featuresCol),
            label_col=self.getOrDefault(self.labelCol),
            **self._metric_kwargs(),
        )
        k = self.getOrDefault(self.k)
        if k == 1 and common["strategy"] in ("broadcast", "shuffle"):
            # Model-2 min_by fast path. kernel/chunked have no 1-NN
            # aggregate form — they route through knn_classify(k=1),
            # which picks the identical neighbor (the top-1 window order
            # (_d, train_label, train_id) IS min_by's tie-break struct)
            pred = knn_predict_1nn(dataset, self.train, **common).drop("distance")
        else:
            pred = knn_classify(dataset, self.train, k=k, **common)
        out_id = self.getOrDefault(self.idCol)
        out_col = self.getOrDefault(self.predictionCol)
        pred = pred.withColumnRenamed("test_id", out_id).withColumnRenamed(
            "predicted_label", out_col
        )
        return dataset.join(pred, out_id)

    def neighbors(self, dataset: DataFrame) -> DataFrame:
        """The raw neighbor table (test_id, train_id, train_label, distance,
        rank) — the reference's intermediate pair lists, as a DataFrame."""
        return knn_join(
            dataset,
            self.train,
            metric=self.getOrDefault(self.metric),
            k=self.getOrDefault(self.k),
            strategy=self.getOrDefault(self.strategy),
            id_col=self.getOrDefault(self.idCol),
            features_col=self.getOrDefault(self.featuresCol),
            label_col=self.getOrDefault(self.labelCol),
            **self._metric_kwargs(),
        )


# ---------------------------------------------------------------------------
# Persistence — the lazy learner's "model" IS the train table + params
# (Team11-Project.py:123-124), so save = params JSON + train parquet.
# ---------------------------------------------------------------------------


def save_model(model: KnnDtwClassifierModel, path: str, *, overwrite: bool = False) -> None:
    """Persist a fitted model: <path>/params.json + <path>/train/ parquet.

    Parquet goes through the normal DataFrameWriter (distributed write —
    the train table never touches the driver); params are a small JSON
    sidecar written with local file IO — so ``path`` must be a
    driver-visible filesystem path (for object stores, point the sidecar
    at a mounted/fuse path or swap this helper for one using the Hadoop
    FileSystem API; the parquet half already works anywhere).
    """
    import json
    import os

    params = {p.name: model.getOrDefault(p) for p in model.params}
    writer = model.train.write
    if overwrite:
        writer = writer.mode("overwrite")
    writer.parquet(os.path.join(path, "train"))
    # params sidecar written AFTER the data so a readable sidecar implies a
    # complete train directory (cheap crash-consistency ordering)
    tmp = os.path.join(path, "params.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"class": "KnnDtwClassifierModel", "params": params}, f)
    os.replace(tmp, os.path.join(path, "params.json"))


def load_model(spark, path: str) -> KnnDtwClassifierModel:
    """Load a model persisted by ``save_model``."""
    import json
    import os

    with open(os.path.join(path, "params.json")) as f:
        meta = json.load(f)
    if meta.get("class") != "KnnDtwClassifierModel":
        raise ValueError(f"not a KnnDtwClassifierModel checkpoint: {path}")
    model = KnnDtwClassifierModel(train=spark.read.parquet(os.path.join(path, "train")))
    model._set(**meta["params"])
    return model
