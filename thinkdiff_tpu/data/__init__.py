from thinkdiff_tpu.data import builders, processors  # noqa: F401 (registry)
from thinkdiff_tpu.data.tario import (
    ShardWriter, brace_expand, tar_sample_iterator, write_wids_index,
)
from thinkdiff_tpu.data.wids_reader import ChunkedSampler, ShardListDataset
from thinkdiff_tpu.data.collators import (
    CaptionSplitCollator, EmbedShardCollator, WidsProcessCollator,
    random_split_string, biased_random_split_string,
)
from thinkdiff_tpu.data.pipeline import (
    IterLoader, MapDatasetLoader, MultiIterLoader, PrefetchLoader,
    WebDatasetPipeline,
)
