from . import bitutil  # noqa: F401
from .buffer import Allocator, Buffer, TrackedAllocator, default_allocator  # noqa: F401
