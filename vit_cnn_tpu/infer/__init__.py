from .fullscene import full_scene_probabilities, sliding_window_origins
from .windows import (adding_windows_singleimage, generate_windows, grouper,
                      padding_image, restore_from_padding)

__all__ = ["full_scene_probabilities", "sliding_window_origins",
           "adding_windows_singleimage", "generate_windows", "grouper",
           "padding_image", "restore_from_padding"]
