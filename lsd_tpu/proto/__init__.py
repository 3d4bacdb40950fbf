from .wire import encode_message, decode_message
from .detection import serialize_detection, parse_detection
