from hifihr_tpu.data.base import BatchLoader, ConcatLoader, collate
from hifihr_tpu.data.synthetic import SyntheticHandDataset
