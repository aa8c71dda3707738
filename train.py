"""Training CLI: python train.py -c cvppp [-i iters] [-o key=value ...]

Presets: cvppp | bbbc039v1 | ac3ac4 (see pixel_embedded_affinity_tpu/config).
"""

import argparse
import logging
import sys

sys.path.insert(0, ".")


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        key, val = p.split("=", 1)
        cur = out
        parts = key.split(".")
        for k in parts[:-1]:
            cur = cur.setdefault(k, {})
        try:
            import ast

            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        cur[parts[-1]] = val
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, default="cvppp",
                        help="preset name or path to YAML")
    parser.add_argument("-i", "--iters", type=int, default=None)
    parser.add_argument("-o", "--override", nargs="*", default=None,
                        help="dotted key=value overrides")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() so the "
                             "data mesh spans hosts (DP over ICI+DCN)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import jax

    try:  # persistent XLA compile cache (first compile is minutes here)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


    if args.distributed:
        import jax

        jax.distributed.initialize()

    from pixel_embedded_affinity_tpu.config import load_config, PRESETS

    overrides = parse_overrides(args.override)
    if args.cfg in PRESETS:
        cfg = load_config(args.cfg, overrides=overrides)
    else:
        cfg = load_config(yaml_path=args.cfg, overrides=overrides)

    from pixel_embedded_affinity_tpu.train.loop import train

    train(cfg, max_iters=args.iters)


if __name__ == "__main__":
    main()
