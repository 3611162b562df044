"""Production model layer (TPU twins of `generative_recommenders/modules/`):
STU/STUStack, HSTUTransducer, preprocessors, encoders, multitask, DlrmHSTU."""
