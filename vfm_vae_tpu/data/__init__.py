from .wds import WdsWrapper, wds_dataloader, ShardTracker, transform_image
