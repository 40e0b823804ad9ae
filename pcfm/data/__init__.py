"""Data layer: H5 shard datasets, loaders, condition encoders, PLY IO."""
from pcfm.data.condition import encode_motors, get_cond_dim
from pcfm.data.h5_dataset import (PartNetH5Dataset, SubsetDataset,
                                  TDCRH5Dataset, get_datasets, sample_idx,
                                  subset_indices)
from pcfm.data.loader import (DataLoader, collate, get_data_loaders,
                              to_model_batch)
from pcfm.data.ply import (load_ply, save_point_cloud_ply,
                           save_point_cloud_ply_rgb, save_point_cloud_xyz)
from pcfm.data.synthetic import (SyntheticDataset, hinge_shape,
                                 write_synthetic_shards)
from pcfm.data.pack_h5 import pack_ply_to_h5

__all__ = [
    "encode_motors", "get_cond_dim", "PartNetH5Dataset", "SubsetDataset",
    "TDCRH5Dataset", "get_datasets", "sample_idx", "subset_indices",
    "DataLoader", "collate", "get_data_loaders", "to_model_batch", "load_ply",
    "save_point_cloud_ply", "save_point_cloud_ply_rgb",
    "save_point_cloud_xyz", "SyntheticDataset", "hinge_shape",
    "write_synthetic_shards", "pack_ply_to_h5",
]
