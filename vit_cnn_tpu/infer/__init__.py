from .fullscene import full_scene_probabilities, sliding_window_origins

__all__ = ["full_scene_probabilities", "sliding_window_origins"]
