from .pipeline import PreprocessConfig, Preprocessor, slam_frontend_config
