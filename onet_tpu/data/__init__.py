from onet_tpu.data.arrays import ArrayDataset, batch_iterator, train_test_split
from onet_tpu.data.simclutter import (
    simclutter_datasets,
    load_simclutter_pt,
    filter_by_snr_range,
)
