from msmd_tpu.data.pickle_dataset import (  # noqa: F401
    MotionClipDataset,
    get_dataset,
    incremental_mean_and_std,
    load_chunked_pickle,
)
from msmd_tpu.data.synthetic import write_synthetic_dataset  # noqa: F401
