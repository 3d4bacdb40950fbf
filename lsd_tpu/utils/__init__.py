from .log import get_logger
from .period import PeriodCalculator
