from .inference import inference_recognizer, init_recognizer
from .test import multi_process_test, single_process_test

__all__ = ['inference_recognizer', 'init_recognizer', 'multi_process_test', 'single_process_test']
