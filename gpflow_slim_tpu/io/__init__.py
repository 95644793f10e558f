from .dataset import BinaryDataset, write_gfsb

__all__ = ["BinaryDataset", "write_gfsb"]
