"""Service entrypoint: `python -m rag_application_tpu.serve`.

Boots the full stack the way the reference's docker-compose assembles its
services (app/main.py lifespan: connect stores, spawn background tasks) —
here one process: config from env (RAGTPU_* overrides), encoder + LLM
router, HTTP API with all endpoints, MCP mounted at /mcp, periodic KG
deduplication per user space.
"""

from __future__ import annotations

import asyncio
import logging
import os


def main() -> None:
    logging.basicConfig(level=os.environ.get("LOG_LEVEL", "INFO"))
    from .api.app import build_app
    from .api.http import HTTPServer
    from .config import Config
    from .llm.router import LLMRouter, Provider

    cfg = Config.from_env()
    provider = Provider(os.environ.get("RAGTPU_LLM_PROVIDER", "stub"))
    llm = LLMRouter(
        provider,
        model=os.environ.get("RAGTPU_LLM_MODEL", "stub-model"),
        base_url=os.environ.get("RAGTPU_LLM_BASE_URL"),
        api_key=os.environ.get("RAGTPU_LLM_API_KEY"),
    )
    router, state = build_app(cfg, llm=llm,
                              api_key=os.environ.get("RAGTPU_API_KEY"))

    host = os.environ.get("RAGTPU_HOST", "0.0.0.0")
    port = int(os.environ.get("RAGTPU_PORT", "8000"))
    server = HTTPServer(router, host=host, port=port)

    async def run() -> None:
        # background KG dedup across user spaces (parity: the reference's
        # per-user deduplication interval, deduplicator.py:161-169)
        from .kg.dedup import deduplicate

        async def dedup_loop():
            interval = float(os.environ.get("RAGTPU_DEDUP_INTERVAL", "300"))
            while True:
                await asyncio.sleep(interval)
                for space in list(state.users.values()):
                    try:
                        deduplicate(space.kg)
                    except Exception:  # noqa: BLE001
                        logging.exception("dedup pass failed")

        asyncio.ensure_future(dedup_loop())
        await server.serve_forever()

    asyncio.run(run())


if __name__ == "__main__":
    main()
