from .runner import CvProfile, TestFuncInfo, TestResult
