from .loaders import TaskData, load_msr, load_co, load_nu
from .preprocess import data_preprocess_co, CO_COMMON_FEATURES
