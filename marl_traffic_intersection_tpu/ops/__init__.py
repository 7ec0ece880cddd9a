"""Custom TPU ops (Pallas kernels)."""
from .lidar_pallas import lidar_scan_pallas

__all__ = ["lidar_scan_pallas"]
