from .text_video import SeerPipeline

__all__ = ["SeerPipeline"]
