from gdn_tpu.data.synthetic import SyntheticDataset, synthetic_batch

