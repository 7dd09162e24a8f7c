from .profiling import profile_section, profiler_summary, time_function
