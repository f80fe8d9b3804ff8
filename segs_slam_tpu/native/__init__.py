from segs_slam_tpu.native.bindings import (
    NativeLoader,
    NativeTracker,
    native_available,
)

__all__ = ["NativeLoader", "NativeTracker", "native_available"]
