"""Online serving: WSGI app sharing the offline path's jitted kernels."""

from .app import SearchService, make_wsgi_app, serve
from .batching import CoalescingService

__all__ = ["SearchService", "CoalescingService", "make_wsgi_app", "serve"]
