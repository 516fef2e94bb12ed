from . import erfnet, erfnet_rap, erfnet_multihead

__all__ = ["erfnet", "erfnet_rap", "erfnet_multihead"]
