from .binary import read_binary_media

__all__ = ["read_binary_media"]
