from .helpers import (  # noqa: F401
    model_info,
    seed_everything,
    calculate_model_size,
    calculate_inference_time,
    count_params,
    get_device_memory_usage,
)
