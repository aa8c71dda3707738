"""Inference CLI: python inference.py -c cvppp -ck <ckpt> [-m validation|test]

2D presets decode with mutex watershed + small-object merging and report
SBD/DiC/VOI/ARAND (CVPPP) or AJI/F1/PQ (BBBC); ac3ac4 runs the tiled 3D
engine with mutex/waterz/multicut decoders and reports VOI/ARAND.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    import jax

    try:  # persistent XLA compile cache (first compile is minutes here)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_pea")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, default="cvppp")
    parser.add_argument("-ck", "--checkpoint", type=str, required=True)
    parser.add_argument("-m", "--mode", type=str, default="validation")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--torch-ckpt", action="store_true",
                        help="checkpoint is a reference torch .ckpt file")
    parser.add_argument("-o", "--override", nargs="*", default=None,
                        help="dotted key=value overrides")
    parser.add_argument("--decoders", type=str, default="mutex,waterz,lmc",
                        help="3D decoders to run (comma-separated)")
    parser.add_argument("--one-dispatch", action="store_true",
                        help="2D: force the whole image set through ONE jit "
                             "dispatch (exact same math; amortizes the "
                             "per-dispatch link latency; default on TPU)")
    parser.add_argument("--serial", action="store_true",
                        help="2D: force per-image dispatch (the reference "
                             "pattern) instead of the one-dispatch scan")
    parser.add_argument("--export", type=str, default=None, metavar="PATH",
                        help="instead of running inference, freeze the "
                             "checkpoint + forward + affinity graph to a "
                             "portable StableHLO serving artifact "
                             "(jax.export; symbolic batch dim)")
    parser.add_argument("--export-hw", type=str, default=None,
                        help="2D export spatial shape as H,W (default: the "
                             "preset's padded serving shape)")
    args = parser.parse_args()
    one_dispatch = True if args.one_dispatch else (False if args.serial
                                                   else None)

    from pixel_embedded_affinity_tpu.config import load_config
    from pixel_embedded_affinity_tpu.train.loop import build_dataset
    from train import parse_overrides

    cfg = load_config(args.cfg, overrides=parse_overrides(args.override))

    if args.torch_ckpt:
        from pixel_embedded_affinity_tpu.train.convert_torch import (
            load_torch_state_dict, convert_resunet2d_deep,
            convert_unet_pni_deep, to_jax_variables)

        sd = load_torch_state_dict(args.checkpoint)
        conv = (convert_unet_pni_deep if cfg.model.arch == "unet_pni_deep"
                else convert_resunet2d_deep)
        variables = to_jax_variables(conv(sd))
    else:
        from pixel_embedded_affinity_tpu.train.checkpoint import load_checkpoint

        restored = load_checkpoint(args.checkpoint)
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}

    if args.export:
        from pixel_embedded_affinity_tpu.infer import export_checkpoint

        hw = (tuple(int(v) for v in args.export_hw.split(","))
              if args.export_hw else None)
        exported = export_checkpoint(cfg, variables, args.export, hw=hw)
        print(json.dumps({"artifact": args.export,
                          "platforms": list(exported.platforms),
                          "in_avals": [str(a) for a in exported.in_avals]}))
        return

    if cfg.model.arch in ("unet_pni_deep", "unet3d_mala"):
        from pixel_embedded_affinity_tpu.data.ac3ac4 import AC3AC4ValidVolume
        from pixel_embedded_affinity_tpu.infer import run_inference_3d

        vol = AC3AC4ValidVolume(cfg.data.data_folder,
                                dataset_name="ac3" if args.mode == "test"
                                else cfg.data.dataset_name,
                                mode=args.mode)
        timing = {}
        _, results = run_inference_3d(cfg, variables, vol.raw, gt=vol.label,
                                      decoders=tuple(args.decoders.split(",")),
                                      timing=timing)
        for dec, (seg, m) in results.items():
            print(dec, json.dumps(m))
        print("COST TIME:", json.dumps(timing))
    elif args.mode == "test" and cfg.name == "cvppp":
        from pixel_embedded_affinity_tpu.data.cvppp import CVPPPTest
        from pixel_embedded_affinity_tpu.infer.inference2d import run_cvppp_test

        ds = CVPPPTest(cfg.data.data_folder, padding=cfg.data.padding)
        out = args.out or "submission.h5"
        timing = {}
        segs, names = run_cvppp_test(cfg, variables, ds, out,
                                     one_dispatch=one_dispatch, timing=timing)
        print("COST TIME:", json.dumps(timing))
        print(json.dumps({"submission": out, "images": len(names)}))
    else:
        from pixel_embedded_affinity_tpu.infer import run_inference_2d

        if cfg.name == "bbbc039v1" and args.mode == "test":
            from pixel_embedded_affinity_tpu.data.bbbc import BBBCValidation

            valid = BBBCValidation(cfg.data.data_folder,
                                   shifts=tuple(cfg.data.shifts),
                                   neighbor=cfg.data.neighbor, mode="test")
        else:
            _, valid = build_dataset(cfg)
        timing = {}
        per_image, agg = run_inference_2d(cfg, variables, valid,
                                          out_dir=args.out,
                                          save_h5=args.out is not None,
                                          one_dispatch=one_dispatch,
                                          timing=timing)
        print("COST TIME:", json.dumps(timing))
        print(json.dumps(agg))


if __name__ == "__main__":
    main()
