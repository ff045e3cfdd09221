from .checkpoint import (  # noqa: F401
    flatten_pytree,
    load_sharded_checkpoint,
    save_sharded_checkpoint,
    unflatten_like,
)
from .artifacts import (  # noqa: F401
    ensure_dirs,
    model_checkpoint_path,
    run_artifact_dir,
    save_figure,
    save_json,
    save_table,
)
