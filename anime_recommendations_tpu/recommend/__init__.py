from anime_recommendations_tpu.recommend.context import RecContext
from anime_recommendations_tpu.recommend.similar_anime import similar_anime
from anime_recommendations_tpu.recommend.similar_users import similar_users
from anime_recommendations_tpu.recommend.user_prefs import user_prefs
from anime_recommendations_tpu.recommend.user_recs import user_recs
from anime_recommendations_tpu.recommend.model_recs import model_recs

__all__ = [
    "RecContext",
    "similar_anime",
    "similar_users",
    "user_prefs",
    "user_recs",
    "model_recs",
]
