from anime_recommendations_tpu.data.preprocess import preprocess_ratings
from anime_recommendations_tpu.data.vocab import Vocab, build_vocab
from anime_recommendations_tpu.data.dataset import RatingsDataset, train_holdout_split
from anime_recommendations_tpu.data.catalog import Catalog

__all__ = [
    "preprocess_ratings",
    "Vocab",
    "build_vocab",
    "RatingsDataset",
    "train_holdout_split",
    "Catalog",
]
