from plnlp_tpu.data.ogb import load_ogb_dataset
from plnlp_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["load_ogb_dataset", "make_synthetic_dataset", "load_dataset"]


def load_dataset(name: str, root: str = "dataset"):
    """Dispatch: ``synthetic:<kind>`` specs or an OGB dataset directory.

    Replaces PygLinkPropPredDataset + get_edge_split (reference main.py:74,95)
    without any torch/ogb dependency for the data model itself.
    """
    if name.startswith("synthetic"):
        _, _, kind = name.partition(":")
        return make_synthetic_dataset(kind or "hits")
    return load_ogb_dataset(name, root)
