from zappy_spark.sources.zarrlite import (
    ZarrLiteDataSource,
    read_zarrlite,
    register_zarrlite,
    write_zarrlite,
)

__all__ = [
    "ZarrLiteDataSource",
    "register_zarrlite",
    "read_zarrlite",
    "write_zarrlite",
]
