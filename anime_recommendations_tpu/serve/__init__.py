from anime_recommendations_tpu.serve.api import Engine, serve_http

__all__ = ["Engine", "serve_http"]
