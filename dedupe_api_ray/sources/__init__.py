from dedupe_api_ray.sources.io import (read_records, read_records_csv,
                                       read_training, write_entity_map,
                                       write_training)

__all__ = ["read_records", "read_records_csv", "read_training",
           "write_entity_map", "write_training"]
