"""Thin CLI wrapper for `betavae_tpu` (reference parity: src layer CLI surface)."""
import _bootstrap  # noqa: F401

MODULE = "encode"

if __name__ == "__main__":
    if MODULE == "run_evaluation":
        from betavae_tpu.eval.run_evaluation import main
    else:
        import importlib
        main = importlib.import_module(f"betavae_tpu.infer.{MODULE}").main
    main()
