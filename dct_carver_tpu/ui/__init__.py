from .server import CarverApp, serve

__all__ = ["CarverApp", "serve"]
