from .host import init_on_host, on_cpu

__all__ = ["init_on_host", "on_cpu"]
