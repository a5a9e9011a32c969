from .image import expand2square, process_image, select_best_resolution  # noqa: F401
from .processor import SiglipImagePreprocessor  # noqa: F401
from .prompts import extract_guided_prompt, get_model_name_from_path, tokenizer_multimodal_token  # noqa: F401
from .video import frame_sample, process_video  # noqa: F401
