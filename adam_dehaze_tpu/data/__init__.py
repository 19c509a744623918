from .synthetic import (  # noqa: F401
    apply_fog,
    apply_random_fog,
    random_fog_params,
    INTENSITY_RANGES,
    estimate_transmission_dcp,
    fog_density_map,
)
