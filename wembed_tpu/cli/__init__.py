from . import embed, evaluate, generate

__all__ = ["embed", "evaluate", "generate"]
