from .text_eval import (
    EvalInstance,
    evaluate_image,
    evaluate_dataset,
    transcription_match,
    include_in_dictionary,
)
from .evaluator import TextEvaluator, instances_to_eval, load_gt_zip
from .lexicon import (
    Lexicon,
    LexiconSet,
    find_match_word,
    match_transcript,
    weighted_edit_distance,
)
