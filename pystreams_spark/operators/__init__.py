from . import topk

__all__ = ["topk"]
