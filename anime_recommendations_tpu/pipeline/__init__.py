from anime_recommendations_tpu.pipeline.artifacts import ArtifactStore, ArtifactHandle
from anime_recommendations_tpu.pipeline.runner import PipelineRunner

__all__ = ["ArtifactStore", "ArtifactHandle", "PipelineRunner"]
