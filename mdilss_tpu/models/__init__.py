from . import erfnet, erfnet_ablations, erfnet_rap, erfnet_multihead

__all__ = ["erfnet", "erfnet_ablations", "erfnet_rap", "erfnet_multihead"]
