from gill_tpu.data.dataset import TsvDataset, DataLoader, get_dataset  # noqa: F401
