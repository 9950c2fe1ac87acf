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
    p.add_argument("--self-test", action="store_true",
                   help="run a functionality self-test at startup "
                        "(reference initialize_enhancer, app.py:626-751)")
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
    if args.self_test:
        from .warm_start import warm_start

        results = warm_start(models=["cnn_upscaler", "bicubic"], size=32,
                             frames=2)
        ok = all(r["ok"] for r in results.values())
        log.info("self-test %s: %s", "passed" if ok else "FAILED", results)
    log.info("UI on http://%s:%d/ui  API on /api/v1", args.host, args.port)
    serve(router, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
