"""Serving layer: REST API surface over stdlib HTTP.

No external web framework exists in this image (fastapi/uvicorn absent), so
the API is served by a small routing layer on ``http.server`` with the same
endpoint contract as the reference FastAPI app (reference api/main.py,
api/v1/process_endpoints.py).
"""

from .http import Request, Response, Router  # noqa: F401
