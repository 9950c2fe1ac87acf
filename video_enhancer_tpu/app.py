"""Main application entry — the reference ``app.py`` equivalent.

``python -m video_enhancer_tpu.app`` serves the web UI (at ``/ui``), the
embedded REST API (``/api/v1/*``), health and metrics on ONE port, the same
shape as the reference's Gradio app with embedded FastAPI endpoints
(reference app.py:1903-2098). Default port 7860 like the reference.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    p = argparse.ArgumentParser(prog="video_enhancer_tpu.app")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--require-auth", action="store_true")
    args = p.parse_args(argv)

    from .utils.jaxenv import setup
    from .utils.logging_config import setup_logging

    setup()
    setup_logging(structured=False)
    log = logging.getLogger("app")

    from .serving.app import ApiServer, create_app
    from .serving.http import serve
    from .serving.ui import register_ui

    server = ApiServer(data_dir=args.data_dir,
                       require_auth=args.require_auth)
    router = create_app(server)
    register_ui(router)
    log.info("UI on http://%s:%d/ui  API on /api/v1", args.host, args.port)
    serve(router, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
