from .metrics import (
    compute_metrics,
    hz_to_cents,
    circular_cents_distance,
    rms_cents_error,
    estimate_tracking_delay_ms,
    compute_overshoot_cents,
)
from .stimuli import (
    synthesize_from_f0_curve,
    generate_vibrato_waveform,
    generate_glide_waveform,
    sample_reference_f0,
)

__all__ = [
    "compute_metrics",
    "hz_to_cents",
    "circular_cents_distance",
    "rms_cents_error",
    "estimate_tracking_delay_ms",
    "compute_overshoot_cents",
    "synthesize_from_f0_curve",
    "generate_vibrato_waveform",
    "generate_glide_waveform",
    "sample_reference_f0",
]
