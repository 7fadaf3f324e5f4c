"""Engine operators (SURVEY.md §2.B build targets).

Every operator is DataFrame→DataFrame; shuffles are explicit and documented
per operator. Python crossings happen only in Arrow batches.
"""
