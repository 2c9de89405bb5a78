"""Host CLI (reference host/src/lib.rs Opts :24-118 + bin/main.rs).

Config layering (later wins, reference four-layer merge): built-in
defaults -> --config-path JSON file -> CLI flags -> per-request body
(applied in the handlers)."""

from __future__ import annotations

import argparse
import asyncio
import json
import logging

from aiohttp import web

from ..chain import SupportedChainSpecs
from ..core.interfaces import merge_json
from ..tasks import get_task_manager
from .actor import HostConfig, ProofActor
from .app import create_app


def parse_opts(argv=None) -> HostConfig:
    p = argparse.ArgumentParser("raiko-tpu-host")
    p.add_argument("--address", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--concurrency-limit", type=int, default=16)
    p.add_argument("--config-path", default=None)
    p.add_argument("--chain-spec-path", default=None)
    p.add_argument("--cache-path", default=None)
    p.add_argument("--sqlite-file", default=None)
    p.add_argument("--max-db-size", type=int, default=1_073_741_824)
    p.add_argument("--jwt-secret", default=None)
    p.add_argument("--log-level", default="info")
    p.add_argument(
        "--log-path",
        default=None,
        help="directory for rolling JSON-lines logs (ref host/src/bin/main.rs:31-58)",
    )
    args = p.parse_args(argv)
    from .logs import init_logging

    init_logging(args.log_level, args.log_path)

    file_cfg = {}
    if args.config_path:
        with open(args.config_path) as f:
            file_cfg = json.load(f)
    cli_cfg = {
        "address": args.address,
        "port": args.port,
        "concurrency_limit": args.concurrency_limit,
        "cache_dir": args.cache_path,
        "chain_spec_path": args.chain_spec_path,
        "sqlite_path": args.sqlite_file,
        "max_db_size": args.max_db_size,
        "jwt_secret": args.jwt_secret,
    }
    merged = merge_json(file_cfg, {k: v for k, v in cli_cfg.items() if v is not None})
    cfg = HostConfig(
        concurrency_limit=merged.get("concurrency_limit", 16),
        cache_dir=merged.get("cache_dir"),
        chain_spec_path=merged.get("chain_spec_path"),
        sqlite_path=merged.get("sqlite_path"),
        max_db_size=merged.get("max_db_size", 1_073_741_824),
        jwt_secret=merged.get("jwt_secret"),
        address=merged.get("address", "0.0.0.0"),
        port=merged.get("port", 8080),
        default_request={
            k: v
            for k, v in merged.items()
            if k
            not in (
                "address",
                "port",
                "concurrency_limit",
                "cache_dir",
                "chain_spec_path",
                "sqlite_path",
                "max_db_size",
                "jwt_secret",
            )
        },
    )
    return cfg


def build(config: HostConfig):
    chain_specs = SupportedChainSpecs(config.chain_spec_path)
    tasks = get_task_manager(config.sqlite_path, config.max_db_size)
    actor = ProofActor(config, tasks, chain_specs)
    return actor, create_app(actor)


def main(argv=None) -> None:
    config = parse_opts(argv)
    actor, app = build(config)

    async def _run():
        actor.start()
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, config.address, config.port)
        await site.start()
        logging.info("raiko-tpu host listening on %s:%d", config.address, config.port)
        while True:
            await asyncio.sleep(3600)

    asyncio.run(_run())


if __name__ == "__main__":
    main()
