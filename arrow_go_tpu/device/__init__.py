from .block import (DeviceBatch, DeviceColumn, batch_from_device,  # noqa: F401
                    batch_to_device, from_device, pad_length, row_mask,
                    to_device)
